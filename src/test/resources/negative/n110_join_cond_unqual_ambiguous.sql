-- reference: ql/src/test/queries/clientnegative/join_cond_unqual_ambiguous.q
-- self-join where the unqualified join-key could be either side
-- ERROR-CONTAINS: AMBIGUOUS_REFERENCE | is ambiguous
SELECT s1.n_name FROM nation s1, nation s2 WHERE n_nationkey = s2.n_nationkey;
