from omniparser_tpu.agent.tools.computer import (
    ComputerTool,
    ToolCollection,
    ToolError,
    ToolResult,
)

__all__ = ["ComputerTool", "ToolCollection", "ToolError", "ToolResult"]
