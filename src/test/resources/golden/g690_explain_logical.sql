-- explain_logical.q: EXPLAIN LOGICAL prints the logical operator tree
-- only (HiveParser.g explainOption KW_LOGICAL) — here the Catalyst
-- OPTIMIZED logical plan, with expression ids and file paths scrubbed
-- so the text is stable across sessions and hosts. The
-- EXPLAIN AUTHORIZATION sibling block (CURRENT_USER is host-specific)
-- is pinned in Round10Spec instead.
EXPLAIN LOGICAL
SELECT n_regionkey, count(*) AS c
FROM nation
WHERE n_nationkey > 5
GROUP BY n_regionkey
