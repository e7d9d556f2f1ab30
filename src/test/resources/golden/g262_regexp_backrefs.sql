-- regexp_replace backreferences ($1) and regexp_extract group selection
SELECT c_custkey,
  regexp_replace(c_name, '([A-Za-z]+)#0*(\\d+)', '$2-$1') AS flipped,
  regexp_extract(c_name, '#(0*)(\\d+)', 2) AS num,
  regexp_extract(c_name, '#(0*)(\\d+)', 0) AS whole
FROM customer WHERE c_custkey <= 20
