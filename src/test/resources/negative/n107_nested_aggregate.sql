-- reference: ql/src/test/queries/clientnegative/udaf_invalid_place.q
-- (nested/misplaced-aggregate family): an aggregate inside an aggregate
-- ERROR-CONTAINS: NESTED_AGGREGATE_FUNCTION | aggregate function in the argument of another aggregate
SELECT sum(max(n_regionkey)) FROM nation;
