-- MERGE INTO SQL text (UpdateDeleteSemanticAnalyzer's three-branch
-- rewrite): UPDATE matched, DELETE matched-with-predicate (predicate over
-- a source-only flag column), INSERT not-matched — one statement.
DROP TABLE IF EXISTS g465_t;
DROP TABLE IF EXISTS g465_s;
CREATE TABLE g465_t (k INT, v STRING, qty INT);
CREATE TABLE g465_s (k INT, v STRING, qty INT, op STRING);
INSERT INTO g465_t VALUES (1,'one',10), (2,'two',20), (3,'three',30), (4,'four',40);
INSERT INTO g465_s VALUES (2,'TWO',22,'U'), (3,'gone',0,'D'), (5,'five',50,'U'), (6,'six',60,'I');
MERGE INTO g465_t t USING g465_s s ON t.k = s.k
WHEN MATCHED AND s.op = 'D' THEN DELETE
WHEN MATCHED THEN UPDATE SET v = s.v, qty = s.qty
WHEN NOT MATCHED THEN INSERT VALUES (s.k, s.v, s.qty);
SELECT k, v, qty FROM g465_t
