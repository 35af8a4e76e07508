"""Sources: file readers (S1-S5), BibTeX (S2), JATS parse kernel
(X1-X9), batched HTTP connector pattern (S6-S10)."""
