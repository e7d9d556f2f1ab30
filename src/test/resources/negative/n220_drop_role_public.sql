-- reference: SQLStdHiveAccessController reserved-role rule (the drop
-- half of clientnegative/authorization_public_create.q's create refusal)
-- ERROR-CONTAINS: reserved role public
DROP ROLE public;
