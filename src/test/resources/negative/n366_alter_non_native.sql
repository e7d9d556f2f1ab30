-- reference: ql/src/test/queries/clientnegative/alter_non_native.q —
-- a STORED BY storage-handler table is out of engine scope (SURVEY
-- sanctions HBase/Accumulo handlers as note-only); the CREATE itself
-- refuses rather than minting a table ALTER would then corrupt.
-- ERROR-CONTAINS: STORED BY | storage handler | not supported | non-native
CREATE TABLE neg366_non_native (key INT, value STRING)
STORED BY 'org.apache.hadoop.hive.ql.metadata.DefaultStorageHandler';
ALTER TABLE neg366_non_native RENAME TO neg366_renamed;
