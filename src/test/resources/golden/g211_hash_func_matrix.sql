-- digest/encode breadth: md5/sha1/sha2/crc32/base64/hex chain
SELECT r_regionkey,
  md5(r_name) AS m, sha1(r_name) AS s1, sha2(r_name, 256) AS s2,
  crc32(r_name) AS c32, base64(encode(r_name, 'UTF-8')) AS b64,
  hex(r_name) AS hx, decode(unhex(hex(r_name)), 'UTF-8') AS uh,
  decode(unbase64(base64(encode(r_name, 'UTF-8'))), 'UTF-8') AS rt
FROM region
