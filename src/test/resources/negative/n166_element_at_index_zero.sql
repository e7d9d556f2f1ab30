-- reference: ql/src/test/queries/clientnegative/udf_elt_wrong_type.q
-- (collection-access family): SQL array indices start at 1
-- ERROR-CONTAINS: INVALID_INDEX_OF_ZERO | index 0 is invalid
SELECT element_at(array(1,2), 0) FROM nation;
