-- ALTER TABLE ... CONCATENATE (small-file merge), content-preserving
DROP TABLE IF EXISTS g276_t;
CREATE TABLE g276_t (k BIGINT, v STRING) USING parquet;
INSERT INTO g276_t SELECT o_orderkey, o_orderstatus FROM orders WHERE o_orderkey <= 100;
INSERT INTO g276_t SELECT o_orderkey, o_orderstatus FROM orders WHERE o_orderkey > 100 AND o_orderkey <= 200;
INSERT INTO g276_t SELECT o_orderkey, o_orderstatus FROM orders WHERE o_orderkey > 200 AND o_orderkey <= 300;
ALTER TABLE g276_t CONCATENATE;
SELECT v, count(*) AS n, min(k) AS mk, max(k) AS xk FROM g276_t GROUP BY v
