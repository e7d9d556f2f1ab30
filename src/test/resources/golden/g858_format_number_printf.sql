-- udf_format_number.q / udf_printf.q: formatting functions — grouped
-- decimal formatting at several scales and printf with mixed argument
-- types including NULLs.
SELECT format_number(12332.123456, 4) AS f1,
       format_number(12332.1, 4) AS f2,
       format_number(12332.2, 0) AS f3,
       format_number(0.123456789, 12) AS f4,
       format_number(12345678.123456789, 5) AS f5,
       printf('Hello World %d %s', 100, 'days') AS p1,
       printf('number1 %d, number2 %05d, hex %#x, float %5.2f',
              123456, 89, 255, 3.14159D) AS p2,
       printf('Null: %s', NULL) AS p3
