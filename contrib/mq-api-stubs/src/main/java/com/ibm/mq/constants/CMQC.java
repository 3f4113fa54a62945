package com.ibm.mq.constants;

/**
 * OFFLINE COMPILE-CHECK STUB — see {@link com.ibm.mq.MQException}
 * header. Values are the publicly documented MQI constants (IBM MQ
 * Knowledge Center "Constants" reference); only the names the adapter
 * touches are stubbed.
 */
public final class CMQC {
    private CMQC() {}

    // connection-hashtable property keys
    public static final String HOST_NAME_PROPERTY = "hostname";
    public static final String PORT_PROPERTY = "port";
    public static final String CHANNEL_PROPERTY = "channel";
    public static final String USER_ID_PROPERTY = "userID";
    public static final String PASSWORD_PROPERTY = "password";
    public static final String USE_MQCSP_AUTHENTICATION_PROPERTY =
        "useMQCSPauthentication";
    public static final String SSL_CIPHER_SUITE_PROPERTY = "SSL Cipher Suite";

    // open options (MQOO_*)
    public static final int MQOO_INPUT_AS_Q_DEF = 0x00000001;
    public static final int MQOO_INPUT_SHARED = 0x00000002;
    public static final int MQOO_BROWSE = 0x00000008;
    public static final int MQOO_OUTPUT = 0x00000010;
    public static final int MQOO_INQUIRE = 0x00000020;
    public static final int MQOO_FAIL_IF_QUIESCING = 0x00002000;

    // get-message options (MQGMO_*)
    public static final int MQGMO_NO_WAIT = 0x00000000;
    public static final int MQGMO_SYNCPOINT = 0x00000002;
    public static final int MQGMO_BROWSE_FIRST = 0x00000010;
    public static final int MQGMO_BROWSE_NEXT = 0x00000020;
    public static final int MQGMO_FAIL_IF_QUIESCING = 0x00002000;

    // put-message options (MQPMO_*)
    public static final int MQPMO_SYNCPOINT = 0x00000002;

    // queue attributes (MQQA_*)
    public static final int MQQA_GET_INHIBITED = 1;

    // reason codes (MQRC_*)
    public static final int MQRC_NO_MSG_AVAILABLE = 2033;
    public static final int MQRC_HOST_NOT_AVAILABLE = 2538;
}
