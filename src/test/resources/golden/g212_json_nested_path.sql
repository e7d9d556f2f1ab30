-- get_json_object nested array paths + json_tuple multi-field
SELECT get_json_object(js, '$.a[1].b') AS ab,
       get_json_object(js, '$.c.d') AS cd,
       get_json_object(js, '$.a[*].b') AS star,
       j.f1, j.f2
FROM (SELECT '{"a":[{"b":1},{"b":2}],"c":{"d":"x"},"f1":"u","f2":"v"}' AS js
      FROM region WHERE r_regionkey = 0) t
LATERAL VIEW json_tuple(js, 'f1', 'f2') j AS f1, f2
