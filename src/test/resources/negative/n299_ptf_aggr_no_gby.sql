-- reference: ql/src/test/queries/clientnegative/
-- ptf_negative_AggrFuncsWithNoGBYNoPartDef.q — an aggregate mixed with a
-- plain column and NO group by / partition spec is refused, not silently
-- grouped.
-- ERROR-CONTAINS: MISSING_GROUP_BY | group by | grouping
SELECT p_brand, sum(p_retailprice) AS s1 FROM part;
