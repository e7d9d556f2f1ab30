-- parquet_types.q: the full primitive matrix (tinyint..binary) round-trips
-- through a parquet table byte-exactly - except CHAR, whose STORAGE is
-- blank-padded but whose read presents the stripped value
-- (HiveSemantics.CharStripReads; the padded bytes are on disk, see
-- Round15Spec's raw-parquet assertion).
DROP TABLE IF EXISTS g501_t;
CREATE TABLE g501_t (
  t TINYINT, s SMALLINT, i INT, b BIGINT,
  f FLOAT, d DOUBLE, de DECIMAL(10,3),
  bo BOOLEAN, st STRING, vc VARCHAR(8), ch CHAR(4),
  dt DATE, ts TIMESTAMP, bin BINARY
) STORED AS PARQUET;
INSERT INTO g501_t VALUES
  (1, 2, 3, 4, 1.5, 2.25, 12.345, true, 'str', 'vc', 'ch',
   DATE '2020-02-29', TIMESTAMP '2020-02-29 23:59:59', cast('bytes' AS BINARY)),
  (-128, -32768, -2147483648, -9223372036854775808, -0.5, -1.25, -99999.999,
   false, '', 'x', 'y', DATE '1900-01-01', TIMESTAMP '1900-01-01 00:00:00',
   cast('' AS BINARY)),
  (NULL, NULL, NULL, NULL, NULL, NULL, NULL, NULL, NULL, NULL, NULL, NULL, NULL, NULL);
SELECT t, s, i, b, f, d, de, bo, st, vc, ch, dt, ts, hex(bin) AS binhex,
       length(ch) AS ch_len
FROM g501_t
