SET hivevar:maxkey=15;
SET hivevar:skipregion=AMERICA;
SELECT n.n_nationkey, n.n_name, r.r_name
FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE n.n_nationkey < ${hivevar:maxkey} AND r.r_name <> '${skipregion}';
