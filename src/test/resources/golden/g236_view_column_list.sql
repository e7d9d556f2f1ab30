-- CREATE VIEW v (cols...) AS: explicit column-list aliasing
DROP VIEW IF EXISTS g236_v;
CREATE TEMPORARY VIEW g236_v (status, cnt, total) AS
SELECT o_orderstatus, count(*), round(sum(o_totalprice) * 100) / 100 FROM orders GROUP BY o_orderstatus;
SELECT status, cnt, total FROM g236_v WHERE cnt > 10
