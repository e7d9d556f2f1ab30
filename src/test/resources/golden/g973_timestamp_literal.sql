-- timestamp_literal.q: the TIMESTAMP 'yyyy-mm-dd hh:mm:ss[.f]' literal
-- keyword, and string-vs-timestamp inequality comparing in the
-- timestamp domain (millisecond difference is significant).
SELECT CAST(timestamp '2011-01-01 01:01:01' AS STRING) AS ts,
       ('2011-01-01 01:01:01.101' != timestamp '2011-01-01 01:01:01.100') AS ne,
       (SELECT count(*) FROM nation
        WHERE timestamp '2011-01-01 01:01:01.101'
           != timestamp '2011-01-01 01:01:01.100') AS n
