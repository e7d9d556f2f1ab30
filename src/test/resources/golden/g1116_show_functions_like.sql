-- reference: ql/src/test/queries/clientpositive/show_functions.q — SHOW
-- FUNCTIONS LIKE with a glob pattern: the log family listing is pinned
-- (the full unfiltered listing is environment-sized; the pattern form
-- is the stem's point).
SHOW FUNCTIONS LIKE 'log*'
