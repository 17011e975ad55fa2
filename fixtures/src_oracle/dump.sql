-- sample dump for the sqldump source oracle
CREATE TABLE proteins (
  id INT PRIMARY KEY,
  name VARCHAR(255)
);
INSERT INTO proteins VALUES (1, 'TP53'), (2, 'BR''CA1');
CREATE TABLE mutations (id INT, protein_id INT, cancer_type VARCHAR(64));
INSERT INTO mutations VALUES (10, 1, 'breast'), (11, 2, 'lung');
INSERT INTO mutations VALUES (12, 1, 'colon');
