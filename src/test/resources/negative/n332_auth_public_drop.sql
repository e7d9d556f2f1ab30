-- reference: ql/src/test/queries/clientnegative/authorization_public_drop.q
-- — DROP ROLE public refuses: public (like admin) is a reserved
-- implicit role every user holds.
-- ERROR-CONTAINS: public | reserved
DROP ROLE public;
