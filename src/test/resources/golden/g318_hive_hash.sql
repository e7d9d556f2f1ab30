-- udf_hash.q: Hive's hash() is the Java hashCode chain
-- (ObjectInspectorUtils.hashCode): an int IS its own hash, a string
-- hashes as String.hashCode ('abc' = 96354), booleans are 1/0, and
-- multi-arg folds left as h*31 + next (hash(1,2) = 1*31+2 = 33).
SELECT hash(5)          AS h_int,
       hash(0)          AS h_zero,
       hash(-1)         AS h_neg,
       hash('abc')      AS h_str,
       hash('')         AS h_empty,
       hash(true)       AS h_true,
       hash(1, 2)       AS h_two,
       hash(1, 2, 3)    AS h_three,
       hash(CAST(7 AS BIGINT)) AS h_long;
