-- reference: ql/src/test/queries/clientnegative/
-- ptf_negative_JoinWithAmbigousAlias.q — the join condition references an
-- alias (p1) that no relation in the query defines; refused at analysis.
-- ERROR-CONTAINS: UNRESOLVED_COLUMN | cannot be resolved | cannot resolve
SELECT abc.*
FROM noop(ON part
PARTITION BY p_brand
ORDER BY p_name
) abc JOIN part ON abc.p_partkey = p1.p_partkey;
