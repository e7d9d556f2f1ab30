-- reference: ql/src/test/queries/clientpositive/reset_conf.q — RESET
-- clears session-set confs back to their defaults; a conf set before
-- the RESET reads as unset after it.
set hive.skewjoin.key=300000;
set hive.skewjoin.mapjoin.min.split=256000000;
RESET;
SET hive.skewjoin.key
