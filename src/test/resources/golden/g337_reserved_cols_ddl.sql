-- quote1.q: reserved words as column AND partition names through DDL,
-- INSERT and SELECT (`table`, `int`, `location` all need quoting).
DROP TABLE IF EXISTS g337_t;
CREATE TABLE g337_t (`location` INT, `type` STRING) USING parquet
PARTITIONED BY (`table` STRING);
INSERT INTO g337_t PARTITION (`table` = 'a') VALUES (1, 'x'), (2, 'y');
INSERT INTO g337_t PARTITION (`table` = 'b') VALUES (3, 'z');
SELECT `table`, `location`, `type` FROM g337_t
WHERE `location` > 1 ORDER BY `location`;
