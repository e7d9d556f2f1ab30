-- reference: ql/src/test/queries/clientnegative/ptf_negative_AmbiguousWindowDefn.q
-- (reference-chain leg): a WINDOW alias defined in terms of a missing one
-- ERROR-CONTAINS: UNRESOLVED_WINDOW_REFERENCE | Cannot resolve window reference
SELECT sum(o_totalprice) OVER w2 FROM orders WINDOW w2 AS w3;
