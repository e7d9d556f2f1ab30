-- CLUSTER BY inside a window spec (PTFTranslator accepts it as the
-- partition spec with no ordering)
SELECT p_brand, count(*) over (cluster by p_brand) AS c
FROM part
