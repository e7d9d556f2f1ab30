-- reference: ql/src/test/queries/clientnegative/exim_02_all_part_over_overlap.q
-- partitioned IMPORT refuses when an incoming partition already exists
-- in the destination — only NEW partitions may land
-- ERROR-CONTAINS: partition already exists
DROP TABLE IF EXISTS neg_exim_ovl_src;
DROP TABLE IF EXISTS neg_exim_ovl_dst;
CREATE TABLE neg_exim_ovl_src (emp_id INT, emp_country STRING) USING PARQUET PARTITIONED BY (emp_country);
INSERT INTO neg_exim_ovl_src VALUES (1, 'in'), (2, 'us');
EXPORT TABLE neg_exim_ovl_src TO '${NEGTMP}/exp_ovl';
CREATE TABLE neg_exim_ovl_dst (emp_id INT, emp_country STRING) USING PARQUET PARTITIONED BY (emp_country);
INSERT INTO neg_exim_ovl_dst PARTITION (emp_country='in') VALUES (7);
IMPORT TABLE neg_exim_ovl_dst FROM '${NEGTMP}/exp_ovl';
