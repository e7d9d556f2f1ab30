-- avro_compression_enabled_native.q: the graft-avro writer emits
-- deflate-compressed containers; write-then-read round trip over the
-- native DSv2 path must be lossless, aggregates equal the source.
DROP TABLE IF EXISTS g676_av;
CREATE TABLE g676_av (k INT, v STRING) USING `graft-avro`;
INSERT INTO g676_av SELECT n_nationkey, n_name FROM nation;
SELECT COUNT(*) AS n, SUM(k) AS s, MIN(v) AS mn, MAX(v) AS mx FROM g676_av
