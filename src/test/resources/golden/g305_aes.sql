-- udf_aes_encrypt.q / udf_aes_decrypt.q: AES with a 128-bit key. ECB is
-- the deterministic mode (GCM salts a random IV per call), so the golden
-- pins the exact ciphertext and the decrypt round-trip.
SELECT hex(aes_encrypt('msg', '1234567890123456', 'ECB'))       AS enc_hex,
       CAST(aes_decrypt(aes_encrypt('graft', '1234567890123456', 'ECB'),
                        '1234567890123456', 'ECB') AS STRING)   AS round_trip,
       CAST(aes_decrypt(unhex('74EE4AD588099E967632925EFCB94951'),
                        '1234567890123456', 'ECB') AS STRING)   AS from_fixed;
