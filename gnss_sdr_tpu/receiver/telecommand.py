"""TCP telecommand interface.

Counterpart of the reference's TcpCmdInterface
(/root/reference/src/core/receiver/tcp_cmd_interface.cc:46-120): a
line-protocol TCP server with the verbs ``status standby reset hotstart
warmstart coldstart set_ch_satellite``. Commands dispatch synchronously to
a controller object (the Receiver) between processing blocks — the
single-threaded analogue of the reference's Command_Event queue.
"""

from __future__ import annotations

import socketserver
import threading
from typing import Callable

# command -> minimum argument count (after the verb)
VERBS = {
    "status": 0,
    "standby": 0,
    "reset": 0,
    "hotstart": 0,
    "warmstart": 0,
    "coldstart": 0,
    "set_ch_satellite": 2,
}


class TelecommandServer:
    """Threaded TCP server; one command per line, textual reply per line."""

    def __init__(self, dispatch: Callable[[str, list[str]], str],
                 host: str = "127.0.0.1", port: int = 0):
        outer = self

        class Handler(socketserver.StreamRequestHandler):
            def handle(self):
                while True:
                    line = self.rfile.readline()
                    if not line:
                        break
                    parts = line.decode(errors="replace").strip().split()
                    if not parts:
                        continue
                    verb, args = parts[0].lower(), parts[1:]
                    if verb == "exit":
                        self.wfile.write(b"OK\n")
                        break
                    if verb not in VERBS:
                        self.wfile.write(
                            f"ERROR unknown command {verb}\n".encode())
                        continue
                    if len(args) < VERBS[verb]:
                        self.wfile.write(
                            f"ERROR {verb} needs {VERBS[verb]} args\n".encode())
                        continue
                    try:
                        reply = outer.dispatch(verb, args)
                    except Exception as exc:  # report, keep serving
                        reply = f"ERROR {exc}"
                    self.wfile.write((reply.rstrip("\n") + "\n").encode())

        self.dispatch = dispatch
        self._server = socketserver.ThreadingTCPServer((host, port), Handler)
        self._server.daemon_threads = True
        self.port = self._server.server_address[1]
        self._thread = threading.Thread(
            target=self._server.serve_forever, daemon=True)

    def start(self) -> None:
        self._thread.start()

    def stop(self) -> None:
        self._server.shutdown()
        self._server.server_close()
