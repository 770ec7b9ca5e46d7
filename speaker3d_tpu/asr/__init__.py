"""Native ASR: SAN-M encoder + CTC head, greedy decode with timestamps."""
