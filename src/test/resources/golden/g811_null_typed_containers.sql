-- null_cast.q: NULL literals coerced INSIDE container constructors — an
-- array of (null, int), (null, empty array), (null, empty map),
-- (null, struct) each takes the non-null element's type.
SELECT array(NULL, 0) AS a1,
       array(NULL, array()) AS a2,
       array(NULL, map()) AS a3,
       array(NULL, struct(0)) AS a4
FROM nation TABLESAMPLE (1 ROWS)
