"""kafka_wire transport security: SASL/SCRAM (256 + 512) conversations and
verified TLS, against MiniBroker's independent server-side implementations.
Certificates for the TLS tier are generated per-test with the openssl CLI
(SAN = IP:127.0.0.1), so nothing long-lived or checked-in."""

import shutil
import socket
import ssl
import struct
import subprocess

import pytest

from go_pq_cdc_kafka_spark.streaming.kafka import (
    KafkaProducerConfig,
)
from go_pq_cdc_kafka_spark.streaming.kafka_wire import (
    KafkaProtocolError,
    KafkaWireConsumer,
    KafkaWireProducer,
    ScramConversation,
)
from go_pq_cdc_kafka_spark.streaming.minibroker import MiniBroker, _ScramServer

CREDS = {"cdc_user": "cdc_pass"}


# -- SCRAM conversation (no sockets) ---------------------------------------

@pytest.mark.parametrize("mech", ["SCRAM-SHA-256", "SCRAM-SHA-512"])
def test_scram_conversation_mutual_auth(mech):
    client = ScramConversation(mech, "cdc_user", "cdc_pass")
    server = _ScramServer(mech, CREDS)
    s_first = server.server_first(client.client_first())
    s_final = server.server_final(client.client_final(s_first))
    assert s_final is not None
    client.verify_server_final(s_final)  # must not raise


def test_scram_rejects_wrong_password_and_tampered_server():
    client = ScramConversation("SCRAM-SHA-512", "cdc_user", "WRONG")
    server = _ScramServer("SCRAM-SHA-512", CREDS)
    s_first = server.server_first(client.client_first())
    assert server.server_final(client.client_final(s_first)) is None

    # server signature must be verified by the client (MITM downgrade guard)
    client2 = ScramConversation("SCRAM-SHA-256", "cdc_user", "cdc_pass")
    server2 = _ScramServer("SCRAM-SHA-256", CREDS)
    sf = server2.server_first(client2.client_first())
    good = server2.server_final(client2.client_final(sf))
    tampered = b"v=" + b"A" * (len(good) - 2)
    with pytest.raises(ValueError, match="signature mismatch"):
        client2.verify_server_final(tampered)


def test_scram_username_comma_equals_escaping():
    client = ScramConversation("SCRAM-SHA-256", "we,ird=user", "pw")
    server = _ScramServer("SCRAM-SHA-256", {"we,ird=user": "pw"})
    s_first = server.server_first(client.client_first())
    assert server.server_final(client.client_final(s_first)) is not None


# -- SASL over the socket ---------------------------------------------------

@pytest.mark.parametrize("mech", ["SCRAM-SHA-256", "SCRAM-SHA-512"])
def test_sasl_produce_fetch_roundtrip(mech):
    with MiniBroker(num_partitions=1, sasl_credentials=CREDS) as broker:
        sasl = (mech, "cdc_user", "cdc_pass")
        with KafkaWireProducer(broker.bootstrap, sasl=sasl) as prod:
            prod.send_records([("t", b"k", b"v", [])])
        with KafkaWireConsumer(broker.bootstrap, sasl=sasl) as cons:
            got = cons.read_all("t")
    assert [r.value for r in got] == [b"v"]


def test_sasl_bad_password_fails_loudly():
    with MiniBroker(num_partitions=1, sasl_credentials=CREDS) as broker:
        with pytest.raises(KafkaProtocolError, match="SASL_AUTHENTICATION_FAILED"):
            KafkaWireProducer(
                broker.bootstrap, sasl=("SCRAM-SHA-256", "cdc_user", "nope")
            ).send_records([("t", b"k", b"v", [])])


def test_sasl_unsupported_mechanism_reports_offered():
    with MiniBroker(num_partitions=1, sasl_credentials=CREDS) as broker:
        with pytest.raises(KafkaProtocolError, match="UNSUPPORTED_SASL_MECHANISM"):
            KafkaWireProducer(
                broker.bootstrap, sasl=("SCRAM-SHA-1", "u", "p")
            ).send_records([("t", b"k", b"v", [])])


def test_unauthenticated_produce_is_disconnected():
    """A SASL listener must not serve data APIs to unauthenticated clients."""
    with MiniBroker(num_partitions=1, sasl_credentials=CREDS) as broker:
        with pytest.raises((ConnectionError, OSError)):
            prod = KafkaWireProducer(broker.bootstrap)  # no sasl
            prod.send_records([("t", b"k", b"v", [])])
        assert broker.topic_records("t") == []


# -- TLS --------------------------------------------------------------------

needs_openssl = pytest.mark.skipif(
    shutil.which("openssl") is None, reason="openssl CLI not available"
)


def _selfsigned(tmp_path):
    key = tmp_path / "key.pem"
    crt = tmp_path / "crt.pem"
    subprocess.run(
        [
            "openssl", "req", "-x509", "-newkey", "rsa:2048", "-nodes",
            "-keyout", str(key), "-out", str(crt), "-days", "1",
            "-subj", "/CN=minibroker",
            "-addext", "subjectAltName=IP:127.0.0.1",
        ],
        check=True,
        capture_output=True,
    )
    return str(key), str(crt)


def _server_ctx(key, crt):
    ctx = ssl.SSLContext(ssl.PROTOCOL_TLS_SERVER)
    ctx.load_cert_chain(certfile=crt, keyfile=key)
    return ctx


@needs_openssl
def test_tls_produce_roundtrip_with_ca_file(tmp_path):
    key, crt = _selfsigned(tmp_path)
    with MiniBroker(num_partitions=1, ssl_context=_server_ctx(key, crt)) as broker:
        with KafkaWireProducer(
            broker.bootstrap, tls={"root_ca_path": crt}
        ) as prod:
            prod.send_records([("t", b"k", b"tls-bytes", [])])
        assert [r.value for r in broker.topic_records("t")] == [b"tls-bytes"]


@needs_openssl
def test_tls_untrusted_cert_rejected(tmp_path):
    """No CA configured → default trust store → self-signed must fail:
    verification is on and cannot be switched off."""
    key, crt = _selfsigned(tmp_path)
    with MiniBroker(num_partitions=1, ssl_context=_server_ctx(key, crt)) as broker:
        with pytest.raises((ssl.SSLError, ConnectionError)):
            KafkaWireProducer(broker.bootstrap, tls={}).send_records(
                [("t", b"k", b"v", [])]
            )


@needs_openssl
def test_sasl_over_tls_full_stack_via_config(tmp_path):
    """The reference's production posture (SASL_SSL with inline root CA,
    kafka/client.go:53-125) through KafkaProducerConfig.wire_kwargs."""
    key, crt = _selfsigned(tmp_path)
    pem = open(crt, encoding="utf-8").read()
    with MiniBroker(
        num_partitions=1,
        sasl_credentials=CREDS,
        ssl_context=_server_ctx(key, crt),
    ) as broker:
        cfg = KafkaProducerConfig(
            brokers=[broker.bootstrap],
            sasl_enabled=True,
            sasl_username="cdc_user",
            sasl_password="cdc_pass",
            sasl_mechanism="SCRAM-SHA-512",
            tls_enabled=True,
            root_ca_pem=pem,
        )
        with KafkaWireProducer(**cfg.wire_kwargs()) as prod:
            prod.send_records([("t", b"k", b"sasl-ssl", [])])
        assert [r.value for r in broker.topic_records("t")] == [b"sasl-ssl"]


def test_wire_kwargs_validates_mechanism_driver_side():
    cfg = KafkaProducerConfig(
        brokers=["b:9092"], sasl_enabled=True, sasl_mechanism="PLAIN"
    )
    with pytest.raises(ValueError, match="unsupported SASL mechanism"):
        cfg.wire_kwargs()


def test_plaintext_client_against_tls_listener_fails_cleanly(tmp_path):
    """Client without tls against a TLS listener: the broker kills the
    connection during the bogus handshake — surfaced as a connection error,
    not a hang."""
    if shutil.which("openssl") is None:
        pytest.skip("openssl CLI not available")
    key, crt = _selfsigned(tmp_path)
    with MiniBroker(num_partitions=1, ssl_context=_server_ctx(key, crt)) as broker:
        with pytest.raises((ConnectionError, OSError, struct.error)):
            prod = KafkaWireProducer(broker.bootstrap, timeout_s=5.0)
            prod.send_records([("t", b"k", b"v", [])])


@needs_openssl
def test_kafkawire_source_reads_sasl_ssl_broker(spark, tmp_path):
    """The Spark source's sasl.*/tls.* options drive the same security
    stack: batch read from a SASL_SSL listener (driver-side planning AND
    executor-side fetches both authenticate)."""
    from go_pq_cdc_kafka_spark.sources import kafka_source as KS

    key, crt = _selfsigned(tmp_path)
    with MiniBroker(
        num_partitions=2,
        sasl_credentials=CREDS,
        ssl_context=_server_ctx(key, crt),
    ) as broker:
        with KafkaWireProducer(
            broker.bootstrap,
            sasl=("SCRAM-SHA-512", "cdc_user", "cdc_pass"),
            tls={"root_ca_path": crt},
        ) as prod:
            prod.send_records(
                [("t.sec", b"k1", b"v1", []), ("t.sec", b"k2", b"v2", [])]
            )
        KS.register(spark)
        rows = (
            spark.read.format("kafkawire")
            .option("bootstrap", broker.bootstrap)
            .option("topic", "t.sec")
            .option("sasl.mechanism", "SCRAM-SHA-512")
            .option("sasl.username", "cdc_user")
            .option("sasl.password", "cdc_pass")
            .option("tls", "true")
            .option("tls.rootca", crt)
            .load()
        )
        assert sorted(bytes(r.value) for r in rows.collect()) == [b"v1", b"v2"]
