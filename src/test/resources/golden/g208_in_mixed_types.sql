-- IN with mixed literal types: bigint key vs (int, double, string)
-- list resolves via DOUBLE across ALL operands (GenericUDFIn +
-- getCommonClassForComparison; HiveSemantics round 10) — so custkey 2
-- matches the 2.0 member. Spark's native coercion compared via STRING
-- here ("2" <> "2.0"), silently dropping rows; re-pinned to Hive.
SELECT o_orderstatus, count(*) AS n FROM orders
WHERE o_orderstatus IN ('F', 'O') AND o_custkey IN (1, 2.0, '3', 4, 5, 6, 7, 8, 9, 10)
GROUP BY o_orderstatus
