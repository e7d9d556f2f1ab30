-- ptf.q tests 3/4 shape: bare PTF projection and a trailing alias on the call
SELECT abc.p_brand, abc.p_name, abc.p_size,
rank() OVER (PARTITION BY abc.p_brand ORDER BY abc.p_name) AS r
FROM noopwithmap(on part
  partition by p_brand
  order by p_name) abc
WHERE abc.p_size < 10
