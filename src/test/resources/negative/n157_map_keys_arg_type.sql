-- reference: ql/src/test/queries/clientnegative/udf_map_keys_arg_type.q
-- map_keys over a non-map argument
-- ERROR-CONTAINS: UNEXPECTED_INPUT_TYPE | data type mismatch
SELECT map_keys(n_name) FROM nation;
