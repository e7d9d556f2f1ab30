-- varchar_cast.q: the cast matrix FROM varchar must equal the same
-- casts from string — numeric family, decimal, date and timestamp.
SELECT
  cast(cast('11' AS varchar(10)) AS tinyint) AS ty,
  cast(cast('11' AS varchar(10)) AS smallint) AS si,
  cast(cast('11' AS varchar(10)) AS int) AS i,
  cast(cast('11' AS varchar(10)) AS bigint) AS bi,
  cast(cast('11.00' AS varchar(10)) AS float) AS f,
  cast(cast('11.00' AS varchar(10)) AS double) AS d,
  cast(cast('11.00' AS varchar(10)) AS decimal(10,0)) AS de,
  cast(cast('2011-01-01' AS varchar(10)) AS date) AS da,
  cast(cast(cast('2011-01-01 01:02:03' AS varchar(30)) AS timestamp) AS string) AS ts,
  (cast(cast('11' AS varchar(10)) AS int)
     = cast(cast('11' AS string) AS int)) AS eq_i,
  (cast(cast('11.00' AS varchar(10)) AS double)
     = cast(cast('11.00' AS string) AS double)) AS eq_d
FROM nation LIMIT 1
