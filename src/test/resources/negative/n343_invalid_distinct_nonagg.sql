-- reference: ql/src/test/queries/clientnegative/invalid_distinct1.q
-- (+ invalid_distinct2.q, invalid_distinct3.q) — DISTINCT inside a
-- NON-aggregate function (hash, explode,
-- nested upper) refuses: DISTINCT qualifies aggregates only.
-- ERROR-CONTAINS: DISTINCT | distinct
SELECT hash(DISTINCT n_name) FROM nation;
