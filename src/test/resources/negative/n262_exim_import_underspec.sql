-- reference: ql/src/test/queries/clientnegative/exim_17_part_spec_underspec.q
-- IMPORT ... PARTITION must bind every exported partition column; a
-- partial spec is refused with the reference's 10006 shape.
-- ERROR-CONTAINS: Specified partition not found in import directory
DROP TABLE IF EXISTS neg_exim17;
DROP TABLE IF EXISTS neg_exim17_i;
CREATE TABLE neg_exim17 (emp_id INT) USING parquet
  PARTITIONED BY (emp_country STRING, emp_state STRING);
INSERT INTO neg_exim17 PARTITION (emp_country='in', emp_state='tn') VALUES (1);
INSERT INTO neg_exim17 PARTITION (emp_country='us', emp_state='ka') VALUES (2);
EXPORT TABLE neg_exim17 TO '${NEGTMP}/exp17';
IMPORT TABLE neg_exim17_i PARTITION (emp_country='us') FROM '${NEGTMP}/exp17';
