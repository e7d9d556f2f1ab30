-- timestamp_lazy.q: TIMESTAMP columns in a STORED AS TEXTFILE table run
-- through the LazySimpleSerDe path (graft-text) — wall-clock text bytes
-- (`yyyy-MM-dd HH:mm:ss[.f...]`, fraction only when non-zero), values
-- round-trip exactly, and timestamp functions work over the decoded
-- column. Raw-byte layout is pinned in Round10Spec.
DROP TABLE IF EXISTS g693_ts;
CREATE TABLE g693_ts (t TIMESTAMP, label STRING) STORED AS TEXTFILE;
INSERT INTO g693_ts VALUES
  (TIMESTAMP '2011-01-01 01:02:03', 'whole'),
  (TIMESTAMP '2011-01-01 01:02:03.123', 'millis'),
  (TIMESTAMP '2011-01-01 01:02:03.123456', 'micros'),
  (NULL, 'null_ts');
SELECT label, CAST(t AS STRING) AS s,
       year(t) AS y, minute(t) AS m, second(t) AS sec,
       date_format(t, 'yyyy-MM-dd') AS d
FROM g693_ts ORDER BY label
