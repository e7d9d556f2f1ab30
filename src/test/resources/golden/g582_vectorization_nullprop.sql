-- vectorization_12.q null-propagation chains: NULL through arithmetic,
-- string and conditional expressions; three-valued boolean logic.
SELECT CAST(NULL AS INT) + 1 AS add_null,
       CAST(NULL AS DOUBLE) * 0 AS mul_null,
       CONCAT('a', CAST(NULL AS STRING)) AS concat_null,
       COALESCE(CAST(NULL AS INT), 7) AS coalesce_v,
       NVL(CAST(NULL AS STRING), 'dflt') AS nvl_v,
       (NULL AND FALSE) AS and_false,
       (NULL OR TRUE) AS or_true,
       (NULL AND TRUE) IS NULL AS and_true_null,
       NOT CAST(NULL AS BOOLEAN) IS NOT NULL AS not_null_is,
       CASE WHEN CAST(NULL AS INT) = 1 THEN 'y' ELSE 'n' END AS case_null
