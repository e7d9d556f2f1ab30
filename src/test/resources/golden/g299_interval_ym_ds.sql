-- interval literal forms (HiveParser intervalLiteral): the multi-unit
-- INTERVAL 'y-m' YEAR TO MONTH and INTERVAL 'd h:m:s' DAY TO SECOND
-- spellings, applied to date/timestamp arithmetic.
SELECT DATE '2000-01-15' + INTERVAL '1-2' YEAR TO MONTH           AS d_plus_ym,
       DATE '2000-03-31' - INTERVAL '0-1' YEAR TO MONTH           AS d_minus_m,
       TIMESTAMP '2000-01-15 00:00:00'
         + INTERVAL '1 02:03:04' DAY TO SECOND                    AS ts_plus_ds,
       TIMESTAMP '2000-01-02 03:04:05'
         - INTERVAL '0 03:04:05' DAY TO SECOND                    AS ts_minus_ds,
       CAST(INTERVAL '1-2' YEAR TO MONTH AS STRING)               AS ym_str,
       CAST(INTERVAL '1 02:03:04' DAY TO SECOND AS STRING)        AS ds_str;
