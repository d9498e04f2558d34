"""Evaluation harnesses (reference: eval/ss_pro_gpt4o_omniv2.py)."""
