-- decimal_join.q shape: equi-join on DECIMAL keys of different
-- precision/scale — Hive widens to the common type before matching.
DROP TABLE IF EXISTS g462_a;
DROP TABLE IF EXISTS g462_b;
CREATE TABLE g462_a (k DECIMAL(10,2), v STRING);
CREATE TABLE g462_b (k DECIMAL(12,4), v STRING);
INSERT INTO g462_a VALUES (1.50,'a15'), (2.25,'a225'), (3.00,'a3'), (10.10,'a101');
INSERT INTO g462_b VALUES (1.5000,'b15'), (2.2500,'b225'), (4.0000,'b4'), (10.1000,'b101');
SELECT a.k AS ak, a.v AS av, b.k AS bk, b.v AS bv
FROM g462_a a JOIN g462_b b ON a.k = b.k
