-- ptf_general_queries.q, ptf_register_tblfn.q, ptf_seqfile.q: window
-- functions evaluated over a SEQUENCEFILE-backed table (the PTF battery
-- re-run against the graft-seq source) — storage format must not change
-- windowed answers.
DROP TABLE IF EXISTS g675_seq;
CREATE TABLE g675_seq (k INT, r INT, v STRING) USING `graft-seq`;
INSERT INTO g675_seq SELECT n_nationkey, n_regionkey, n_name FROM nation;
SELECT r, k, rnk, lag_k FROM (
  SELECT r, k, RANK() OVER (PARTITION BY r ORDER BY k) AS rnk,
         LAG(k, 1, -1) OVER (PARTITION BY r ORDER BY k) AS lag_k
  FROM g675_seq) w
WHERE rnk <= 2
