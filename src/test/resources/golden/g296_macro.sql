-- macro_1.q: CREATE TEMPORARY MACRO — compile-time-inlined scalar macros
-- (FunctionSemanticAnalyzer; udf/generic/GenericUDFMacro.java). Rewritten
-- by Engine.ddl onto Spark SQL scalar UDFs, which Catalyst inlines the
-- same way. Covers zero-arg, one-arg and multi-arg forms.
CREATE TEMPORARY MACRO g296_fixed() 42;
CREATE TEMPORARY MACRO g296_sigmoid(x DOUBLE) 1.0 / (1.0 + exp(-x));
CREATE TEMPORARY MACRO g296_add(x INT, y INT) x + y;
SELECT g296_fixed() AS fixed,
       round(g296_sigmoid(2.0) * 1000000) / 1000000 AS sig,
       g296_add(1, 9) AS added,
       g296_add(g296_fixed(), -2) AS nested;
