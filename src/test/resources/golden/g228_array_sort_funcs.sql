-- array dialect breadth: sort_array asc/desc, array_contains, slice, concat
SELECT p_partkey,
  sort_array(split(p_type, ' ')) AS sa,
  sort_array(split(p_type, ' '), false) AS sd,
  array_contains(split(p_type, ' '), 'BRASS') AS hasb,
  slice(split(p_type, ' '), 1, 2) AS sl,
  concat(split(p_brand, '#'), array('x')) AS cc,
  size(split(p_type, ' ')) AS sz
FROM part WHERE p_partkey <= 10
