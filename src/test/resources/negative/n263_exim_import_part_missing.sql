-- reference: ql/src/test/queries/clientnegative/exim_18_part_spec_missing.q
-- A fully-bound IMPORT spec naming a partition the dump does not hold
-- is refused (10006).
-- ERROR-CONTAINS: Specified partition not found in import directory
DROP TABLE IF EXISTS neg_exim18;
DROP TABLE IF EXISTS neg_exim18_i;
CREATE TABLE neg_exim18 (emp_id INT) USING parquet
  PARTITIONED BY (emp_country STRING, emp_state STRING);
INSERT INTO neg_exim18 PARTITION (emp_country='in', emp_state='tn') VALUES (1);
EXPORT TABLE neg_exim18 TO '${NEGTMP}/exp18';
IMPORT TABLE neg_exim18_i PARTITION (emp_country='us', emp_state='kl')
  FROM '${NEGTMP}/exp18';
