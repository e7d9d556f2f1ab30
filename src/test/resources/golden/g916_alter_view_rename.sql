-- alter_view_rename.q: ALTER VIEW ... RENAME TO moves the view name in
-- the catalog; the renamed view reads identically (same-database form —
-- the reference's cross-db rename rides the metastore, out of scope).
DROP VIEW IF EXISTS g916_view2;
DROP VIEW IF EXISTS g916_view1;
DROP TABLE IF EXISTS g916_invites;
CREATE TABLE g916_invites (foo INT, bar STRING) USING parquet;
INSERT INTO g916_invites VALUES (1, 'a'), (2, 'b'), (3, 'c');
CREATE VIEW g916_view1 AS SELECT * FROM g916_invites;
ALTER VIEW g916_view1 RENAME TO g916_view2;
SELECT foo, bar FROM g916_view2 ORDER BY foo
