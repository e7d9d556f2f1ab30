-- binary battery: clientpositive/ba_table1.q, ba_table2.q, ba_table3.q,
-- ba_table_udfs.q, binary_constant.q, binarysortable_1.q — a BINARY
-- column round-trips through a table, casts both ways, and sorts
-- bytewise.
DROP TABLE IF EXISTS g931_ba;
CREATE TABLE g931_ba (ba_key BINARY, ba_val BINARY) USING parquet;
INSERT INTO g931_ba SELECT cast('key1' AS binary), cast('val one' AS binary);
INSERT INTO g931_ba SELECT cast('key0' AS binary), cast('' AS binary);
INSERT INTO g931_ba SELECT cast('akey' AS binary), cast(NULL AS binary);
SELECT cast(ba_key AS string) AS k, hex(ba_key) AS kh,
       length(ba_val) AS vlen, cast(ba_val AS string) AS v,
       hex(cast('a' AS binary)) AS const1
FROM g931_ba ORDER BY ba_key
