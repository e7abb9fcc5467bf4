"""K9 email notifier — the reference's job-status email, re-expressed
with an injectable transport.

Reference behavior (/root/reference/Form700.py:556-583): build an SMTP
multipart message — subject carrying the overall job verdict, plain-text
body with the per-dataset status lines (assembled at :628-655), and the
job-log CSV attached — then send it over a server connection.  The
engine splits that into:

- :class:`EmailNotifier` — pure message assembly (driver-side,
  O(datasets)); produces a stdlib :class:`email.message.EmailMessage`
  so any transport can carry it;
- :class:`Transport` protocol with two implementations:
  :class:`SmtpTransport` (stdlib ``smtplib``, the reference's wire
  path) and :class:`RecordingTransport` (tests/local runs — no network
  in this environment, and notification side effects should be
  injectable anyway).

The sink reports feeding this come from ``ChunkedSink.write`` /
``job_status_rows`` (sinks/chunked.py) — the notifier is the last hop
of the O1 pipeline driver, not part of any data-plane pass.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from email.message import EmailMessage
from typing import Protocol

from .chunked import SinkReport, job_status_rows, write_job_report


class Transport(Protocol):
    def send(self, message: EmailMessage) -> None:
        """Deliver one fully-assembled message."""
        ...


class RecordingTransport:
    """Test/local transport: keeps every message in memory."""

    def __init__(self) -> None:
        self.sent: list[EmailMessage] = []

    def send(self, message: EmailMessage) -> None:
        self.sent.append(message)


class SmtpTransport:
    """The reference's wire path (Form700.py:556-583) over stdlib
    smtplib.  Connection parameters are plain constructor args — no
    environment coupling; the caller owns credentials policy."""

    def __init__(self, host: str, port: int = 25, starttls: bool = False,
                 username: str | None = None, password: str | None = None):
        self.host, self.port = host, port
        self.starttls = starttls
        self.username, self.password = username, password

    def send(self, message: EmailMessage) -> None:
        import smtplib

        with smtplib.SMTP(self.host, self.port) as server:
            if self.starttls:
                server.starttls()
            if self.username:
                server.login(self.username, self.password or "")
            server.send_message(message)


@dataclass
class EmailNotifier:
    """Assemble and send the job-status email.

    ``send_job_status`` is the K9 surface: subject = job verdict, body =
    the K10 status message (one line per dataset with the A3
    reconciliation), attachment = the K8 job-log CSV.
    """

    transport: Transport
    sender: str = "etl@example.invalid"
    recipients: tuple[str, ...] = field(default_factory=tuple)

    def build(self, subject: str, body: str,
              attachment_path: str | None = None) -> EmailMessage:
        msg = EmailMessage()
        msg["Subject"] = subject
        msg["From"] = self.sender
        msg["To"] = ", ".join(self.recipients)
        msg.set_content(body)
        if attachment_path is not None:
            with open(attachment_path, "rb") as fh:
                payload = fh.read()
            msg.add_attachment(
                payload,
                maintype="text",
                subtype="csv",
                filename=os.path.basename(attachment_path),
            )
        return msg

    def send(self, subject: str, body: str,
             attachment_path: str | None = None) -> EmailMessage:
        msg = self.build(subject, body, attachment_path)
        self.transport.send(msg)
        return msg

    def send_job_status(self, reports: list[SinkReport], csv_path: str,
                        job_name: str = "form700") -> EmailMessage:
        """K8+K9+K10 in one call: write the job-log CSV, assemble the
        status body, send with the CSV attached."""
        body = write_job_report(reports, csv_path, job_name=job_name)
        overall, _ = job_status_rows(reports)
        return self.send(f"{job_name} load: {overall}", body, csv_path)
