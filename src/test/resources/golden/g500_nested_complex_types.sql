-- nested_complex.q: arrays of structs of arrays, maps of arrays — create,
-- insert, navigate with [], ., map access and size().
DROP TABLE IF EXISTS g500_t;
CREATE TABLE g500_t (
  id INT,
  a ARRAY<STRUCT<nm: STRING, xs: ARRAY<INT>>>,
  m MAP<STRING, ARRAY<INT>>
);
INSERT INTO g500_t VALUES
  (1, array(named_struct('nm','p','xs',array(1,2)), named_struct('nm','q','xs',array(3))),
      map('k1', array(10,20), 'k2', array(30))),
  (2, array(named_struct('nm','r','xs',array())), map('k1', array()));
SELECT id,
       size(a) AS n_structs,
       a[0].nm AS first_nm,
       a[0].xs[1] AS first_xs_1,
       m['k1'][0] AS m_k1_0,
       size(m) AS n_keys,
       size(m['k1']) AS n_k1
FROM g500_t
