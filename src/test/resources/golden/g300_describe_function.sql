-- udf_upper.q opener: DESCRIBE FUNCTION — the reference answers name,
-- implementing class and usage line (DescFunctionDesc); Spark's output
-- carries the same three lines.
DESCRIBE FUNCTION upper;
