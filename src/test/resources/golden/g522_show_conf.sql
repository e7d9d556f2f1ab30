-- SHOW CONF 'name' (DDLSemanticAnalyzer.java:2347 analyzeShowConf,
-- DDLTask.java:520 showConf): answers one (default, type, desc) row from
-- the engine's conf registry (SQLConf's defined entries — the Spark
-- analog of HiveConf.ConfVars). Pinned against the session's fixed Spark
-- version; an unknown name errors ("invalid configuration name").
SHOW CONF 'spark.sql.adaptive.enabled';
