-- protectmode.q / alter_partition_protect_mode.q: ENABLE NO_DROP guards a
-- partition (enforced — see Round8Spec for the rejection), DISABLE lifts
-- it, OFFLINE is accepted; the script completes and data is intact.
DROP TABLE IF EXISTS g503_p;
CREATE TABLE g503_p (key INT) PARTITIONED BY (year STRING);
INSERT INTO g503_p PARTITION (year='1996') VALUES (1), (2);
INSERT INTO g503_p PARTITION (year='1997') VALUES (3);
ALTER TABLE g503_p PARTITION (year='1996') ENABLE NO_DROP;
ALTER TABLE g503_p PARTITION (year='1997') ENABLE OFFLINE;
ALTER TABLE g503_p DROP PARTITION (year='1997');
ALTER TABLE g503_p PARTITION (year='1996') DISABLE NO_DROP;
SELECT year, count(*) AS n FROM g503_p GROUP BY year
