-- reference: ql/src/test/queries/clientnegative/nonkey_groupby.q — a
-- bare column next to an aggregate with NO group by refuses.
-- ERROR-CONTAINS: GROUP BY | group by | grouping
SELECT n_name, count(1) FROM nation;
