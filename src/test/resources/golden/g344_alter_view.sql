-- alter_view_as_select.q: ALTER VIEW ... AS SELECT redefines the view in
-- place; the second definition must win.
DROP VIEW IF EXISTS g344_v;
CREATE TEMPORARY VIEW g344_v AS SELECT r_regionkey AS k FROM region WHERE r_regionkey < 2;
ALTER VIEW g344_v AS SELECT r_regionkey AS k FROM region WHERE r_regionkey >= 3;
SELECT k FROM g344_v ORDER BY k;
