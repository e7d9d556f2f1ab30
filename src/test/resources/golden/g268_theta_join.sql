-- pure inequality (theta) join, bounded inputs
SELECT a.r_regionkey AS ra, b.r_regionkey AS rb
FROM region a JOIN region b ON a.r_regionkey < b.r_regionkey
