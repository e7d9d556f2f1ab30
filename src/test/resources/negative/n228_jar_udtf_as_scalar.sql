-- reference: udtf placement rules — a GenericUDTF class cannot run as a
-- scalar inside WHERE
-- ERROR-CONTAINS: generator | outside the select clause | unsupported_generator
DROP TEMPORARY FUNCTION IF EXISTS neg_jar_tok;
CREATE TEMPORARY FUNCTION neg_jar_tok AS 'graftjar.TokenExplode' USING JAR 'src/test/resources/jars/graft-hiveudf.jar';
SELECT n_name FROM nation WHERE neg_jar_tok(n_name) IS NOT NULL;
