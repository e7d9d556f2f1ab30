-- join_hive_626.q shape: three tables joined along a foreign-key chain
-- with an aggregate on the leaf.
DROP TABLE IF EXISTS g439_a;
DROP TABLE IF EXISTS g439_b;
DROP TABLE IF EXISTS g439_c;
CREATE TABLE g439_a (aid INT, aname STRING);
CREATE TABLE g439_b (bid INT, aid INT, bname STRING);
CREATE TABLE g439_c (cid INT, bid INT, amount DOUBLE);
INSERT INTO g439_a VALUES (1,'alpha'), (2,'beta'), (3,'gamma');
INSERT INTO g439_b VALUES (10,1,'b10'), (11,1,'b11'), (12,2,'b12');
INSERT INTO g439_c VALUES (100,10,5.5), (101,10,6.5), (102,11,1.0), (103,12,9.0), (104,99,4.0);
SELECT a.aname AS aname, b.bname AS bname, round(sum(c.amount) * 100) / 100 AS total
FROM g439_a a JOIN g439_b b ON a.aid = b.aid JOIN g439_c c ON b.bid = c.bid
GROUP BY a.aname, b.bname
