-- join_array.q shape: equi-join where the payload columns are arrays —
-- array values must survive the join and compare stably.
DROP TABLE IF EXISTS g441_a;
DROP TABLE IF EXISTS g441_b;
CREATE TABLE g441_a (userid INT, ids ARRAY<INT>);
CREATE TABLE g441_b (userid INT, ids ARRAY<INT>);
INSERT INTO g441_a VALUES (1, array(10,20,30)), (2, array(40)), (3, array());
INSERT INTO g441_b VALUES (1, array(11,21)), (3, array(33,43)), (4, array(44));
SELECT a.userid AS uid, a.ids AS a_ids, b.ids AS b_ids,
       size(a.ids) AS a_n, a.ids[0] AS a_first
FROM g441_a a JOIN g441_b b ON a.userid = b.userid
