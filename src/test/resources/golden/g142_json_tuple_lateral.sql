WITH t AS (SELECT n_nationkey,
             to_json(named_struct('name', n_name, 'region', n_regionkey,
                                  'tags', array('a', 'b'))) AS js
           FROM nation WHERE n_nationkey < 6)
SELECT n_nationkey, nm, rg, get_json_object(js, '$.tags[1]') AS tag2
FROM t LATERAL VIEW json_tuple(js, 'name', 'region') j AS nm, rg
