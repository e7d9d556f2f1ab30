-- char_cast.q: numeric casts THROUGH char/varchar representations —
-- char('11') to every integral/floating/decimal type equals the
-- string-cast twin.
SELECT
  cast(cast('11' as char(10)) as tinyint) AS ti,
  cast(cast('11' as char(10)) as smallint) AS si,
  cast(cast('11' as char(10)) as int) AS i,
  cast(cast('11' as char(10)) as bigint) AS bi,
  cast(cast('11.00' as char(10)) as float) AS f,
  cast(cast('11.00' as char(10)) as double) AS d,
  cast(cast('11.00' as char(10)) as decimal) AS de,
  cast(cast('11' as varchar(10)) as int) AS vi,
  cast(cast('11.00' as varchar(10)) as double) AS vd
