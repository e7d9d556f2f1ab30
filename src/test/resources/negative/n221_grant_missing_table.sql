-- reference: SemanticAnalyzer getTable refusal for GRANT targets —
-- granting on a table that does not exist must not record a grant that
-- would authorize a FUTURE table of that name
-- ERROR-CONTAINS: table not found
DROP TABLE IF EXISTS neg_grant_missing;
GRANT SELECT ON TABLE neg_grant_missing TO ROLE public;
