-- udf_elt.q / udf_translate.q / udf_sort_array.q: elt with numeric and
-- out-of-range indexes, translate with shorter to-strings and NULLs,
-- sort_array over strings and numerics.
SELECT elt(2, 'abc', 'defg') AS e1,
       elt(3, 'aa', 'bb', 'cc', 'dd') AS e2,
       elt('1', 'abc', 'defg') AS e3,
       elt(null, 'abc', 'defg') AS e4,
       elt(0, 'abc', 'defg') AS e5,
       elt(3, 'abc', 'defg') AS e6,
       translate('abcd', 'ab', '12') AS t1,
       translate('abcd', 'abc', '12') AS t2,
       translate(NULL, 'ab', '12') AS t3,
       sort_array(array('b', 'd', 'c', 'a')) AS s1,
       sort_array(array(2, 9, 7, 3, 5, 4, 1, 6, 8)) AS s2,
       sort_array(array(2.333, 9.0, 1.325, 0.777, -3.445)) AS s3
