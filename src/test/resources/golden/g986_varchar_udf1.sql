-- varchar_udf1.q: the string UDF battery over VARCHAR arguments must
-- equal the same calls over STRING twins — concat/upper/lower/ascii/
-- concat_ws/decode(encode)/instr/length/locate/lpad all
-- varchar-transparent.
DROP TABLE IF EXISTS g986_vu;
CREATE TABLE g986_vu (c1 STRING, c2 STRING, c3 VARCHAR(10), c4 VARCHAR(20))
  USING parquet;
INSERT OVERWRITE TABLE g986_vu
  SELECT CAST(n_nationkey AS STRING), n_name,
         CAST(n_nationkey AS STRING), n_name
  FROM nation WHERE n_nationkey = 8 LIMIT 1;
SELECT concat(c1, c2) AS cat_s, concat(c3, c4) AS cat_v,
       (concat(c1, c2) = concat(c3, c4)) AS cat_eq,
       upper(c4) AS up_v, (upper(c2) = upper(c4)) AS up_eq,
       lower(c4) AS lo_v, (lower(c2) = lower(c4)) AS lo_eq,
       ascii(c4) AS asc_v, (ascii(c2) = ascii(c4)) AS asc_eq,
       concat_ws('|', c3, c4) AS cw_v,
       (concat_ws('|', c1, c2) = concat_ws('|', c3, c4)) AS cw_eq,
       decode(encode(c4, 'US-ASCII'), 'US-ASCII') AS de_v,
       (decode(encode(c2, 'US-ASCII'), 'US-ASCII')
          = decode(encode(c4, 'US-ASCII'), 'US-ASCII')) AS de_eq,
       instr(c4, '_') AS in_v, (instr(c2, '_') = instr(c4, '_')) AS in_eq,
       length(c4) AS len_v, (length(c2) = length(c4)) AS len_eq,
       locate(cast('a' AS varchar(1)), cast('abcdabcd' AS varchar(10)), 3) AS loc_v,
       (locate('a', 'abcdabcd', 3)
          = locate(cast('a' AS varchar(1)), cast('abcdabcd' AS varchar(10)), 3)) AS loc_eq,
       lpad(c4, 15, ' ') AS lp_v, (lpad(c2, 15, ' ') = lpad(c4, 15, ' ')) AS lp_eq
FROM g986_vu LIMIT 1
