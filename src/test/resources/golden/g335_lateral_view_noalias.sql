-- lateral_view_noalias.q (HIVE-2608): LATERAL VIEW without the AS
-- column-alias list — explode(map) answers its default key/value column
-- names through the view alias.
SELECT myTab.* FROM (SELECT r_regionkey FROM region WHERE r_regionkey = 0) t
LATERAL VIEW explode(map('key1', 100, 'key2', 200)) myTab
ORDER BY key;
