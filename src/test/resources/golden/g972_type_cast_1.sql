-- type_cast_1.q: IF's common type across int and smallint branches then
-- + int — resolves through the numeric lattice to int, value 5.
SELECT IF(false, 1, cast(2 AS smallint)) + 3 AS v FROM nation LIMIT 1
