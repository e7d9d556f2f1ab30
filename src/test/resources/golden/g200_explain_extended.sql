EXPLAIN EXTENDED SELECT count(*) AS n FROM region WHERE r_regionkey > 1
