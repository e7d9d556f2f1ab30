-- timestamp_udf.q: the timestamp-function battery — calendar fields,
-- to_date, date_add/sub through a timestamp, self-datediff, and
-- from_utc_timestamp/to_utc_timestamp round trip.
DROP TABLE IF EXISTS g838_t;
CREATE TABLE g838_t (t TIMESTAMP) USING parquet;
INSERT INTO g838_t VALUES (timestamp'2011-05-06 07:08:09.123456');
SELECT year(t) AS y, month(t) AS m, day(t) AS d, hour(t) AS h,
       minute(t) AS mi, second(t) AS s, weekofyear(t) AS woy,
       to_date(t) AS td,
       date_add(t, 5) AS da, date_sub(t, 10) AS ds,
       datediff(t, t) AS dself,
       CAST(to_utc_timestamp(from_utc_timestamp(t, 'America/Chicago'),
            'America/Chicago') AS STRING) AS roundtrip
FROM g838_t
