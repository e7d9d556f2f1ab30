-- reference: ql/src/test/queries/clientnegative/having1.q (resolution leg)
-- a HAVING predicate naming a column that exists nowhere
-- ERROR-CONTAINS: UNRESOLVED_COLUMN | cannot be resolved
SELECT n_regionkey, count(*) AS c FROM nation GROUP BY n_regionkey HAVING no_col > 1;
