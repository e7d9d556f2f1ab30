SELECT c_custkey,
       size(sentences(concat(initcap(lower(c_mktsegment)), ' one here. Two done.'))) AS n_sent,
       array_join(sentences(concat(initcap(lower(c_mktsegment)), ' one here. Two done.'))[0], ' ') AS s1
FROM customer WHERE c_custkey < 20
