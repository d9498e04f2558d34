"""Agent orchestration (host Python, thin — SURVEY.md §2.3).

The GUI-agent loop around the parser: screenshot the VM -> parse ->
prompt an LLM with the element list -> translate its action to a pyautogui
command -> POST into the VM -> repeat.  Message payloads are plain dicts in
the Anthropic content-block shape (the reference uses SDK Beta* objects;
no SDKs exist in this image, and the wire format is identical).
"""
