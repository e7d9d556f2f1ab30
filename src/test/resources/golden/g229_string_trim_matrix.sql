-- trim family incl. Hive's ltrim/rtrim and SQL-standard TRIM(BOTH x FROM y)
SELECT c_custkey,
  trim(concat('  ', c_mktsegment, ' ')) AS t,
  ltrim(concat('  ', c_mktsegment)) AS lt,
  rtrim(concat(c_mktsegment, '  ')) AS rt,
  trim(BOTH '#' FROM concat('##', c_mktsegment, '#')) AS tb,
  trim(LEADING '0' FROM substr(c_name, 10)) AS tl,
  trim(TRAILING '1' FROM c_name) AS tt
FROM customer WHERE c_custkey <= 20
