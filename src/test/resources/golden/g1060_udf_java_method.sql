-- reference: ql/src/test/queries/clientpositive/udf_java_method.q —
-- java_method() as the reflect() synonym: static and instance methods
-- over boxed arguments, numeric results re-rounded for stability.
SELECT java_method('java.lang.String', 'valueOf', 1) AS v1,
       java_method('java.lang.Integer', 'toBinaryString', 5) AS v2,
       java_method('java.lang.Math', 'max', 2, 3) AS v3,
       java_method('java.lang.Math', 'min', 2, 3) AS v4,
       java_method('java.lang.Math', 'round', 2.5D) AS v5,
       round(cast(java_method('java.lang.Math', 'exp', 1.0D) AS DOUBLE) * 1000000) / 1000000 AS v6,
       java_method('java.lang.Math', 'floor', 1.9D) AS v7
FROM nation TABLESAMPLE (1 ROWS);
