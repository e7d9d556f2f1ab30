-- escape_clusterby1.q / escape_distributeby1.q / escape_orderby1.q /
-- escape_sortby1.q: backtick-escaped identifiers inside CLUSTER BY,
-- DISTRIBUTE BY ... SORT BY, and ORDER BY — including a reserved-word
-- column name (`order`) that only resolves when quoted.
DROP TABLE IF EXISTS g539_src;
CREATE TABLE g539_src USING parquet AS
  SELECT CAST(n_nationkey AS STRING) AS key, concat('val_', n_nationkey) AS value,
         CAST(n_regionkey AS INT) AS `order`
  FROM nation;
SELECT 'cluster' AS v, `key`, value FROM
  (SELECT `key`, value FROM g539_src WHERE `order` = 1 CLUSTER BY `key`, value) t
UNION ALL
SELECT 'dist_sort', `key`, value FROM
  (SELECT `key`, value, `order` FROM g539_src DISTRIBUTE BY `order` SORT BY `key` DESC) t
WHERE `order` = 2
UNION ALL
SELECT 'order_by', `key`, value FROM
  (SELECT `key`, value FROM g539_src WHERE `order` = 3 ORDER BY `key` LIMIT 3) t
