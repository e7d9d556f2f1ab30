-- vector_decimal_1.q: decimal(4,2) cast to every primitive — boolean
-- (nonzero=true), integer family (truncation), float/double, string,
-- and timestamp (seconds since epoch, fraction kept).
DROP TABLE IF EXISTS g950_dec1;
CREATE TABLE g950_dec1 (t DECIMAL(4,2), u DECIMAL(5,0), v DECIMAL(10,0))
  USING parquet;
INSERT OVERWRITE TABLE g950_dec1
  SELECT CAST('17.29' AS DECIMAL(4,2)), CAST(3.1415926 AS DECIMAL(5,0)),
         CAST(3115926.54321 AS DECIMAL(10,0))
  FROM nation LIMIT 1;
SELECT cast(t AS boolean) AS b, cast(t AS tinyint) AS ty,
       cast(t AS smallint) AS sm, cast(t AS int) AS i,
       cast(t AS bigint) AS bi, cast(t AS float) AS f,
       cast(t AS double) AS d, cast(t AS string) AS s,
       cast(cast(t AS timestamp) AS string) AS ts, u AS u, v AS v
FROM g950_dec1
