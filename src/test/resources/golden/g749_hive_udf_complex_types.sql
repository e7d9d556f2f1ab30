-- complex types through the jar-UDF adapter: array<int> argument
-- (Catalyst ArrayData -> java List via the standard
-- ListObjectInspector) and struct return (Object[] under a
-- StandardStructObjectInspector -> InternalRow), field-accessed in SQL.
CREATE TEMPORARY FUNCTION g749_astats AS 'graftjar.ArrayStats' USING JAR 'src/test/resources/jars/graft-hiveudf.jar';
SELECT n_regionkey,
       g749_astats(collect_list(n_nationkey)).mn AS mn,
       g749_astats(collect_list(n_nationkey)).mx AS mx,
       g749_astats(collect_list(n_nationkey)).n AS n
FROM nation GROUP BY n_regionkey;
