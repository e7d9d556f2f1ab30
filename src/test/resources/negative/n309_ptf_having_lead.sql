-- reference: ql/src/test/queries/clientnegative/
-- ptf_negative_HavingLeadWithPTF.q — HAVING with a bare lead() over an
-- EMPTY window spec after a PTF is refused (the reference refuses the
-- HAVING-without-GROUP-BY shape outright; the engine keeps modern
-- global-aggregate HAVING but still refuses this query on the unordered
-- lead window, so the invalid script fails either way).
-- ERROR-CONTAINS: requires window to be ordered | HAVING specified without GROUP BY
SELECT p_brand, p_name, p_size
FROM noop(ON part
PARTITION BY p_brand
ORDER BY p_name)
HAVING lead(p_size, 1) OVER () <= p_size
DISTRIBUTE BY p_brand
SORT BY p_name;
