SELECT count(*) AS n FROM lineitem
WHERE (l_returnflag, l_linestatus) IN (('A','F'), ('R','F'))
