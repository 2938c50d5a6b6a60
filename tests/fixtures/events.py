"""Synthetic test events matching the reference corpus's shapes and
golden values (see FIXTURES.md; reference lambdas/tests/samples/).
Re-created from the documented schemas — not copies of the sample files.
"""

from __future__ import annotations

import copy
import json


def cloudtrail_create_log_stream() -> dict:
    """Pre-shelled CloudTrail API-call event (FIXTURES.md §2.1).
    Goldens: utctimestamp 2019-09-04T17:54:59+00:00 (from eventtime);
    sourceipaddress 54.21.12.27."""
    return {
        "source": "cloudtrail",
        "tags": [],
        "details": {
            "apiversion": "20140328",
            "eventtype": "AwsApiCall",
            "recipientaccountid": "123456789012",
            "responseelements": None,
            "eventid": "a1b2c3d4-1111-2222-3333-444455556666",
            "eventsource": "logs.amazonaws.com",
            "useragent": "awslambda-worker",
            "eventname": "CreateLogStream",
            "eventversion": "1.05",
            "sourceipaddress": "54.21.12.27",
            "requestid": "d9f2c8a1-aaaa-bbbb-cccc-ddddeeeeffff",
            "eventtime": "2019-09-04T17:54:59Z",
            "awsregion": "us-west-2",
            "requestparameters": {
                "loggroupname": "/aws/lambda/demo",
                "logstreamname": "2019/09/04/[$LATEST]abcdef",
            },
            "useridentity": {
                "type": "AssumedRole",
                "principalid": "AROAEXAMPLE:demo",
                "arn": "arn:aws:sts::123456789012:assumed-role/demo",
                "accountid": "123456789012",
                "accesskeyid": "ASIAEXAMPLE",
                "sessioncontext": {
                    "attributes": {
                        "mfaauthenticated": "false",
                        "creationdate": "2019-09-04T17:54:46Z",
                    },
                    "sessionissuer": {
                        "type": "Role",
                        "principalid": "AROAEXAMPLE",
                        "arn": "arn:aws:iam::123456789012:role/demo",
                        "accountid": "123456789012",
                        "username": "demo",
                    },
                },
            },
            "lambda_details": {
                "function_version": "$LATEST",
                "function_arn": "arn:aws:lambda:us-west-2:123456789012:function:processor",
                "function_name": "processor",
                "memory_size": "128",
            },
        },
    }


def cloudfront_wordpress_probe() -> dict:
    """Flat access-log record, raw (FIXTURES.md §2.2).  Goldens:
    utctimestamp 2020-09-01T17:48:18+00:00 (date+time zip);
    sourceipaddress 139.59.66.23 (from c-ip)."""
    return {
        "date": "2020-09-01",
        "time": "17:48:18",
        "x-edge-location": "SEA19-C1",
        "sc-bytes": 673,
        "c-ip": "139.59.66.23",
        "cs-method": "GET",
        "cs(Host)": "d1234.cloudfront.net",
        "cs-uri-stem": "/wp-login.php",
        "sc-status": 404,
        "cs(Referer)": "-",
        "cs(User-Agent)": "Mozilla/5.0",
        "cs-uri-query": "-",
        "cs(Cookie)": "-",
        "x-edge-result-type": "Error",
        "x-edge-request-id": "AbCdEfGh1234",
        "x-host-header": "example.org",
        "cs-protocol": "https",
        "cs-bytes": 82,
        "time-taken": 0.04,
        "x-forwarded-for": "-",
        "ssl-protocol": "TLSv1.2",
        "ssl-cipher": "ECDHE-RSA-AES128-GCM-SHA256",
        "x-edge-response-result-type": "Error",
        "cs-protocol-version": "HTTP/1.1",
        "fle-status": "-",
        "fle-encrypted-fields": "-",
        "c-port": 50213,
        "time-to-first-byte": 0.04,
        "x-edge-detailed-result-type": "Error",
        "sc-content-type": "text/html",
        "sc-content-len": 555,
        "sc-range-start": "-",
        "sc-range-end": "-",
    }


def vpc_flow_log() -> dict:
    """Flat VPC flow record, raw (FIXTURES.md §2.3).  Goldens:
    utctimestamp 2014-12-14T04:06:50+00:00 (from start);
    sourceipaddress 198.51.100.1; destinationipaddress 192.0.2.1."""
    return {
        "account_id": "123456789012",
        "action": "ACCEPT",
        "bytes": 840,
        "dstaddr": "192.0.2.1",
        "dstport": 443,
        "end": "2014-12-14T04:07:50",
        "interface_id": "eni-abc123de",
        "log_status": "OK",
        "packets": 10,
        "protocol": 6,
        "srcaddr": "198.51.100.1",
        "srcport": 44332,
        "start": "2014-12-14T04:06:50",
        "version": 2,
    }


def syslog_sudo() -> dict:
    """Pre-shelled syslog event with no IP — the benign/no-change
    fixture (FIXTURES.md §2.4)."""
    return {
        "category": "monitoring",
        "severity": "INFO",
        "utctimestamp": "2014-04-17T06:10:54+00:00",
        "summary": "someuser : TTY=pts/0 ; PWD=/home/someuser ; USER=root ; COMMAND=/bin/true",
        "source": "syslog",
        "tags": ["sample"],
        "details": {
            "processid": "0",
            "program": "sudo",
            "hostname": "demo.host.example.com",
            "timestamp": "Apr 17 06:10:54",
        },
    }


def gsuite_login() -> dict:
    """Raw GSuite admin-reports login activity (FIXTURES.md §2.5).
    Goldens after the pipeline: summary 'someone@somewhere.com
    login_success from IP 123.456.253.226', category authentication,
    source gsuite, details.success True."""
    return {
        "kind": "admin#reports#activity",
        "id": {
            "time": "2020-03-02T17:54:33.253Z",
            "uniqueQualifier": "-123456789",
            "applicationName": "login",
            "customerId": "C0123abc",
        },
        "etag": '"abcdefg/hijklmnop"',
        "actor": {"email": "someone@somewhere.com", "profileId": "1234567890"},
        "ipAddress": "123.456.253.226",
        "events": [
            {
                "type": "login",
                "name": "login_success",
                "parameters": [
                    {"name": "login_type", "value": "exchange"},
                    {"name": "login_challenge_method", "multiValue": ["none"]},
                    {"name": "is_suspicious", "boolValue": False},
                ],
            }
        ],
    }


ALL_FIXTURES = {
    "cloudtrail": cloudtrail_create_log_stream,
    "cloudfront": cloudfront_wordpress_probe,
    "vpc_flow": vpc_flow_log,
    "syslog": syslog_sudo,
    "gsuite": gsuite_login,
}


def raw_json(name: str) -> str:
    return json.dumps(ALL_FIXTURES[name]())


def deep_copy(name: str) -> dict:
    return copy.deepcopy(ALL_FIXTURES[name]())
