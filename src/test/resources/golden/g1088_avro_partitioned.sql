-- reference: ql/src/test/queries/clientpositive/avro_partitioned.q —
-- a partitioned avro-serde table fed by dynamic-partition insert from
-- a flat avro table; per-partition scans and a one-partition probe
-- (the stem's episodes/doctor_pt shape over the nation fixture).
SET hive.exec.dynamic.partition=true;
SET hive.exec.dynamic.partition.mode=nonstrict;
DROP TABLE IF EXISTS g1088_episodes;
DROP TABLE IF EXISTS g1088_episodes_part;
CREATE TABLE g1088_episodes (title STRING, air_date STRING, doctor INT)
  STORED AS AVRO;
INSERT INTO g1088_episodes
  SELECT n_name, concat('2014-09-', 10 + n_nationkey % 10),
         CAST(n_regionkey AS INT)
  FROM nation;
CREATE TABLE g1088_episodes_part (title STRING, air_date STRING, doctor INT)
  PARTITIONED BY (doctor_pt INT) STORED AS AVRO;
INSERT OVERWRITE TABLE g1088_episodes_part PARTITION (doctor_pt)
  SELECT title, air_date, doctor, doctor FROM g1088_episodes;
SELECT doctor_pt, count(*) AS n, min(title) AS first_title,
       (SELECT count(*) FROM g1088_episodes_part WHERE doctor_pt = 2) AS probe_pt2
FROM g1088_episodes_part
GROUP BY doctor_pt
