-- reference: ql/src/test/queries/clientpositive/udf_bitmap_and.q +
-- udf_bitmap_or.q + udf_bitmap_empty.q — the ewah bitmap combine
-- surface over aggregated bitmaps (the engine's bitmaps are plain
-- 64-bit word vectors, not EWAH containers, so the battery builds its
-- operands with ewah_bitmap() instead of the reference's encoded
-- literals; and/or/empty semantics are identical).
SELECT a.o_orderstatus AS sa, b.o_orderstatus AS sb,
       ewah_bitmap_empty(ewah_bitmap_and(a.bm, b.bm)) AS empty_and,
       ewah_bitmap_empty(ewah_bitmap_or(a.bm, b.bm)) AS empty_or
FROM (SELECT o_orderstatus, ewah_bitmap(o_custkey % 64) AS bm
      FROM orders WHERE o_orderkey < 500 GROUP BY o_orderstatus) a
JOIN (SELECT o_orderstatus, ewah_bitmap(o_custkey % 64) AS bm
      FROM orders WHERE o_orderkey < 500 GROUP BY o_orderstatus) b
  ON a.o_orderstatus < b.o_orderstatus
