-- keyword-as-identifier: backquoted reserved words as column/table names
-- survive DDL, DML and queries (HiveLexer QuotedIdentifier).
DROP TABLE IF EXISTS g499_t;
CREATE TABLE g499_t (`select` INT, `from` STRING, `order` INT, `table` STRING);
INSERT INTO g499_t VALUES (1,'f1',10,'t1'), (2,'f2',20,'t2');
SELECT `select`, `from`, `order` + 1 AS order_plus, upper(`table`) AS tab
FROM g499_t
WHERE `select` > 0 AND `order` < 30
