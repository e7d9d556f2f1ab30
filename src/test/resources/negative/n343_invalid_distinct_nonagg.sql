-- reference: ql/src/test/queries/clientnegative/invalid_distinct1.q
-- (+ _2, _3) — DISTINCT inside a NON-aggregate function (hash, explode,
-- nested upper) refuses: DISTINCT qualifies aggregates only.
-- ERROR-CONTAINS: DISTINCT | distinct
SELECT hash(DISTINCT n_name) FROM nation;
