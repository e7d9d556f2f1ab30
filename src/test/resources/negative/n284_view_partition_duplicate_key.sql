-- reference: alter_view_failure5.q family (DDLSemanticAnalyzer view
-- partition spec validation): a DUPLICATE key in the spec (a=1, a=2)
-- must not satisfy the all-columns check by count — b stays unbound.
-- ERROR-CONTAINS: duplicate | doesn't contain all
DROP VIEW IF EXISTS neg_vdup;
CREATE VIEW neg_vdup PARTITIONED ON (a, b) AS
  SELECT 1 AS x, 2 AS a, 3 AS b;
ALTER VIEW neg_vdup ADD PARTITION (a='1', a='2');
