-- create_view_translate.q: a view projecting a MAP access with the
-- auto-generated column name (items.info['price'] keeps its synthetic
-- name through the view).
DROP VIEW IF EXISTS g863_priceview;
DROP TABLE IF EXISTS g863_items;
CREATE TABLE g863_items (id INT, name STRING, info MAP<STRING,STRING>)
  USING parquet;
INSERT INTO g863_items SELECT 1, 'widget', map('price', '9.99', 'color', 'red');
INSERT INTO g863_items SELECT 2, 'gadget', map('price', '19.99');
CREATE VIEW g863_priceview AS
  SELECT g863_items.id, g863_items.info['price'] FROM g863_items;
SELECT * FROM g863_priceview
