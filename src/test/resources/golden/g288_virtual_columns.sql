-- Hive virtual columns (VirtualColumn.java): INPUT__FILE__NAME and
-- BLOCK__OFFSET__INSIDE__FILE — the identifiers a migrating script uses
-- verbatim. File names are reduced to their basename so the golden is
-- host-independent; block offset is pinned only as >= 0 (single fixture
-- file ⇒ offset 0, but the claim kept stable is non-negativity).
SELECT
  regexp_extract(INPUT__FILE__NAME, '[a-z]+\\.parquet', 0) AS src_file,
  BLOCK__OFFSET__INSIDE__FILE >= 0 AS offset_ok,
  count(*) AS cnt
FROM nation
GROUP BY 1, 2
ORDER BY src_file;
