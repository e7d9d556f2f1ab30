-- paired posexplode (index-aligned zip of two arrays via positions)
SELECT p_partkey, a.pos, a.w, b.v
FROM (SELECT p_partkey, split(p_type, ' ') AS ws, split(p_brand, '#') AS vs FROM part WHERE p_partkey <= 5) t
LATERAL VIEW posexplode(ws) a AS pos, w
LATERAL VIEW posexplode(vs) b AS pos2, v
WHERE a.pos = b.pos2
