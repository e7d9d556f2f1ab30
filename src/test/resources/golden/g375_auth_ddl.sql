-- Authorization DDL surface (DDLSemanticAnalyzer.java:438,456-459;
-- DDLTask.java:697-713): a real warehouse script's GRANT/ROLE statements
-- must run, maintain the registry, and answer SHOW — not kill the script.
CREATE ROLE analyst;
CREATE ROLE etl_writer;
GRANT ROLE analyst TO USER alice, USER bob;
GRANT etl_writer TO USER bob WITH ADMIN OPTION;
GRANT SELECT ON TABLE orders TO ROLE analyst;
GRANT SELECT, INSERT ON TABLE lineitem TO ROLE etl_writer WITH GRANT OPTION;
GRANT ALL ON TABLE nation TO USER alice;
SHOW GRANT ROLE analyst ON TABLE orders;
SHOW ROLE GRANT USER bob;
SET ROLE analyst;
SHOW CURRENT ROLES;
SET ROLE ALL;
REVOKE INSERT ON TABLE lineitem FROM ROLE etl_writer;
REVOKE ROLE analyst FROM USER alice;
DROP ROLE etl_writer;
SHOW ROLES;
